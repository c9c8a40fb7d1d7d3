#!/bin/sh
# Round-5 TPU measurement queue — stage budget + incoherent cascade A/B
# after the fp32-state / tail-ladder / slim-sort changes.
#
# Writes /tmp/q.lock (our PID) while running so bench.py's device-init
# guard won't collide.  30 s gaps between items: the axon tunnel sometimes
# hangs device init forever when a client connects immediately after the
# previous one detached.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export LPRT_TPU_QUEUE=1
L=/tmp/q5
echo $$ > /tmp/q.lock
trap 'rm -f /tmp/q.lock' EXIT INT TERM
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ($(date))" >> $L.progress
  timeout "$tmo" "$@" > $L.$name.log 2>&1
  echo "=== $name exit=$? ($(date))" >> $L.progress
  sleep 30
}
run ablate_cornell 2400 python tools/profile_ablate.py cornell bf16
run tmap_parts 2400 python tools/bench_tmap_parts.py
run incoh_46k 3600 python tools/bench_incoherent_ab.py 6 3
run oneshot_prof 3600 python tools/profile_oneshot.py 6 3
run stage_budget 2400 python -m low_precision_raytracer_tpu.cli render cornell --width 1920 --height 1080 --precision bf16 --frames 3 --profile
echo ALL_DONE >> $L.progress
rm -f /tmp/q.lock
