#!/bin/bash
# Round-3 safety watchdog: near the estimated round end, kill any
# still-running chip chains (and their python children) so the driver's
# end-of-round bench.py gets the chip (one TPU client at a time; a live
# chain would make the official bench FAIL).
DEADLINE=${1:-1787231000}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    sleep 60
done
for pidfile in /tmp/r3chain.pid /tmp/r3chain2b.pid /tmp/r3chain3.pid; do
    P=$(cat "$pidfile" 2>/dev/null) || continue
    kill -0 "$P" 2>/dev/null || continue
    C=$(ps -o pid= --ppid "$P" 2>/dev/null)
    kill "$P" 2>/dev/null
    for c in $C; do
        G=$(ps -o pid= --ppid "$c" 2>/dev/null)
        kill $c $G 2>/dev/null
    done
    echo "watchdog killed chain $pidfile ($P)"
done
echo "WATCHDOG DONE $(date +%s)"
