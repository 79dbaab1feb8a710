#!/bin/bash
# Round-5 TPU queue #5: CH L-BFGS crash diagnostic + conditional officials.
# Context: today's worker deterministically crashes at the CH ep8000
# adam->lbfgs switch (5 resumed attempts, all banked exactly 4000 epochs —
# r5_queue3 log). Short lbfgs runs succeed, so first pin the trigger.
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
while kill -0 "$(cat /tmp/bs_probe.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done

echo "=== BS probe 2: tighter strike width ==="
bash scripts/probe_retry.sh 2400 black_scholes epochs=1500 seed=0 ic_focus=0.5 ic_width=2.0

echo "=== CH diag A: early lbfgs switch, short run (does lbfgs crash?) ==="
bash scripts/probe_retry.sh 1800 cahn_hilliard_dynamics epochs=1000 seed=0 switch=0.2
echo "=== CH diag B: same but phase2=adam (control) ==="
bash scripts/probe_retry.sh 1800 cahn_hilliard_dynamics epochs=1000 seed=0 switch=0.2 phase2=adam

echo "=== r5_queue5 done ==="
