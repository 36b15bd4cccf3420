#!/bin/bash
# Wait for the TPU relay compile service to recover (trivial-jit canary
# every 10 min), then immediately run the staged kernel probes and, if they
# pass, the full bench. Logs to /tmp/canary.log.
set -u
LOG=/tmp/canary.log
cd /root/repo
for i in $(seq 1 30); do
  echo "=== canary attempt $i $(date)" >> "$LOG"
  if timeout 180 env PYTHONPATH=/root/.axon_site python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a + 1).sum())(jnp.ones(8))), flush=True)
print('HEALTHY', flush=True)" >> "$LOG" 2>&1; then
    echo "=== relay healthy at attempt $i $(date)" >> "$LOG"
    echo "=== staged probes $(date)" >> "$LOG"
    if timeout 900 env PYTHONPATH=/root/repo:/root/.axon_site \
        python exp/exp2d_staged.py >> "$LOG" 2>&1; then
      echo "=== staged ok; running bench $(date)" >> "$LOG"
      timeout 4000 env PYTHONPATH=/root/repo:/root/.axon_site \
        python bench.py > /tmp/bench_out.json 2>> "$LOG"
      echo "=== bench exit $? $(date)" >> "$LOG"
    else
      echo "=== staged FAILED/hung (exit $?) $(date)" >> "$LOG"
    fi
    exit 0
  fi
  sleep 600
done
echo "=== gave up $(date)" >> "$LOG"
exit 1
