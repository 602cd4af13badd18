#!/bin/bash
# Round-3 safety watchdog: near the estimated round end, kill any
# still-running chip chains (recursively, by explicit pid tree) so the
# driver's end-of-round bench.py gets the chip (one TPU client at a
# time; a live chain would make the official bench FAIL).
DEADLINE=${1:-1787231000}
killtree() {
    local k
    for k in $(ps -o pid= --ppid "$1" 2>/dev/null); do
        killtree "$k"
    done
    kill "$1" 2>/dev/null
}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    sleep 60
done
for pidfile in /tmp/r3chain.pid /tmp/r3chain2b.pid /tmp/r3chain3.pid \
               /tmp/r50k.pid; do
    P=$(cat "$pidfile" 2>/dev/null) || continue
    kill -0 "$P" 2>/dev/null || continue
    killtree "$P"
    echo "watchdog killed chain tree $pidfile ($P)"
done
echo "WATCHDOG DONE $(date +%s)"
