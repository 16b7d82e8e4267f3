#!/bin/bash
# Wait for a healthy CPU window, then probe the named queries on the
# pre-optimization worktree (/tmp/r13_base) and the current tree
# back-to-back, same window. Usage: ab_probe.sh q1,q2,... [reps] [tag]
set -u
QUERIES="$1"
REPS="${2:-3}"
TAG="${3:-ab}"
probe() {
  python - <<'EOF'
import time
t0=time.time(); s=0
for i in range(10_000_000): s+=i
print(round(time.time()-t0,3))
EOF
}
for i in $(seq 1 240); do
  P=$(probe)
  OK=$(python -c "print(1 if $P < 0.5 else 0)")
  if [ "$OK" = "1" ]; then echo "healthy probe $P after $i checks"; break; fi
  echo "probe $P — steal window, waiting ($i)"; sleep 60
done
cd /tmp/r13_base && python tools/query_probe.py "$QUERIES" "$REPS" > /tmp/${TAG}_base.json 2>/tmp/${TAG}_base.err
echo "base done: $(tail -c 400 /tmp/${TAG}_base.json)"
cd /root/repo && python tools/query_probe.py "$QUERIES" "$REPS" > /tmp/${TAG}_new.json 2>/tmp/${TAG}_new.err
echo "new done: $(tail -c 400 /tmp/${TAG}_new.json)"
probe
