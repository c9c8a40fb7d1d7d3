#!/bin/sh
# Round-3 TPU measurement queue — run items sequentially, one TPU process at
# a time, logging everything.  Skip-to-next on failure.
#
# Writes /tmp/q.lock (our PID) while running: bench.py's device-init guard
# waits on that lock, so a driver-launched blind bench run cannot collide
# with a queue item on the single-process TPU tunnel.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export LPRT_TPU_QUEUE=1
L=/tmp/q
echo $$ > $L.lock
trap 'rm -f $L.lock' EXIT INT TERM
run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" >> $L.progress
  timeout 3600 "$@" > $L.$name.log 2>&1
  echo "=== $name exit=$? ($(date))" >> $L.progress
}
run bench python bench.py
run incoh_46k python tools/bench_incoherent_ab.py 6 3
run epilogue_ab python tools/bench_epilogue_ab.py 6 3
run wf_tune python tools/bench_wavefront_tune.py 6 3
run large_46k python tools/bench_large_scene.py 6 3
run large_83k python tools/bench_large_scene.py 8 3
run schedule_ab python tools/bench_schedule_ab.py 6 3 10 5
run incoh_2m python tools/bench_incoherent_ab.py 10 5
run stage_budget python -m low_precision_raytracer_tpu.cli render cornell --width 1920 --height 1080 --precision bf16 --frames 3 --profile
run viewer_fps python tools/bench_viewer_fps.py 512 30
echo ALL_DONE >> $L.progress
rm -f $L.lock
