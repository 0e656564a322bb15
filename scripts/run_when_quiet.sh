#!/bin/bash
# Wait for a quiet FP window (matmul < 16 ms twice, 45 s apart), then run
# the (2,8) scaling pair and the full local bench back to back. Controls
# inside each artifact adjudicate whether the window held.
cd /root/repo
probe() {
  python -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import noise_controls
print(noise_controls()['control_matmul_ms'])" 2>/dev/null | tail -1
}
for attempt in $(seq 1 60); do
  m1=$(probe); sleep 45; m2=$(probe)
  echo "probe $attempt: matmul ${m1} / ${m2} ms"
  ok=$(python -c "print(1 if float('${m1}')<16 and float('${m2}')<16 else 0)")
  if [ "$ok" = "1" ]; then
    echo "quiet — scaling pair"
    SPARK_GRAFT_SCALING_LEVELS=2,8 python bench.py --scaling \
      > /tmp/scaling_quiet.json 2>/tmp/scaling_quiet.err
    echo "SCALINGQ_DONE rc=$?"
    m3=$(probe)
    echo "post-scaling matmul ${m3} ms — local bench next"
    python bench.py > /tmp/bench_quiet.json 2>/tmp/bench_quiet.err
    echo "BENCHQ_DONE rc=$?"
    exit 0
  fi
  sleep 75
done
echo "QUIET_GAVE_UP"
