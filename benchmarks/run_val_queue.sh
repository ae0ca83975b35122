#!/bin/bash
# Sequential TPU queue for the held-out-val flagship legs (VERDICT r4 #1).
# Each leg: flagship_split.py ours 600 tpu --val [--sharedinit] --seed N.
# TPU legs occasionally hang on a tunnel RPC (epoch counter stalls, process
# alive at ~14% CPU) — so every attempt runs under `timeout` and a hung/
# failed leg is retried from scratch (TPU legs skip checkpointing by design;
# the partial log is removed so the retry leaves one row per epoch).
cd /root/repo || exit 1

run_leg() {
  local tag="$1"; shift
  local log="benchmarks/results/flagship600_ours_${tag}.jsonl"
  if [ -f "$log" ] && [ "$(wc -l < "$log")" -ge 600 ]; then
    echo "skip $tag (complete)"; return
  fi
  for attempt in 1 2 3; do
    rm -f "$log"
    echo "[$(date +%T)] leg $tag attempt $attempt"
    timeout 3600 nice -n 5 python benchmarks/flagship_split.py ours 600 tpu --val "$@"
    if [ -f "$log" ] && [ "$(wc -l < "$log")" -ge 600 ]; then
      echo "[$(date +%T)] leg $tag done"; return
    fi
    echo "[$(date +%T)] leg $tag attempt $attempt failed/hung"
  done
  echo "[$(date +%T)] leg $tag GAVE UP"
}

# N=3 bands for both init families first, then widen to N=5 if time allows.
run_leg valshared --sharedinit
run_leg valshared_s1 --sharedinit --seed 1
run_leg valshared_s2 --sharedinit --seed 2
run_leg val
run_leg val_s1 --seed 1
run_leg val_s2 --seed 2
run_leg valshared_s3 --sharedinit --seed 3
run_leg valshared_s4 --sharedinit --seed 4
run_leg val_s3 --seed 3
run_leg val_s4 --seed 4
echo "[$(date +%T)] queue complete"
