"""Portable stand-in for `/usr/bin/time -v` (absent in this container):
runs the argv tail as a subprocess and reports wall-clock + peak RSS of
the child tree on stderr.

Usage: python scripts/timev.py <cmd> [args...]
"""
import resource
import subprocess
import sys
import time

t0 = time.time()
proc = subprocess.run(sys.argv[1:])
dt = time.time() - t0
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
# ru_maxrss is KiB on Linux
print(f"TIMEV wall={dt:.1f}s max_rss={ru.ru_maxrss / 1048576:.2f}GiB "
      f"exit={proc.returncode}", file=sys.stderr, flush=True)
sys.exit(proc.returncode)
