#!/bin/bash
# Poll the FP noise control; launch bench.py only in a quiet window
# (matmul < 16 ms on two consecutive probes, 60s apart).
cd /root/repo
for attempt in $(seq 1 40); do
  m1=$(python -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import noise_controls
print(noise_controls()['control_matmul_ms'])" 2>/dev/null | tail -1)
  sleep 60
  m2=$(python -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import noise_controls
print(noise_controls()['control_matmul_ms'])" 2>/dev/null | tail -1)
  echo "probe $attempt: matmul ${m1} / ${m2} ms"
  ok=$(python -c "print(1 if float('${m1}')<16 and float('${m2}')<16 else 0)")
  if [ "$ok" = "1" ]; then
    echo "quiet window — running bench"
    python bench.py > /tmp/bench_quiet.json 2>/tmp/bench_quiet.err
    echo "BENCHQ_DONE rc=$?"
    exit 0
  fi
  sleep 120
done
echo "BENCHQ_GAVE_UP"
