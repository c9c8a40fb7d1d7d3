#!/usr/bin/env bash
# The blessed test entry point: the FULL suite, green or red, in one command.
#
# Why not plain `python -m pytest tests/`: XLA:CPU hard-crashes (SIGSEGV in
# backend_compile_and_load) after a few hundred in-process compilations —
# reproduced repeatedly on this toolchain, always late in the run, never in
# any per-file process (see tests/conftest.py).  That makes single-process
# "suite green" unverifiable.  This runner executes pytest ONE PROCESS PER
# TEST FILE, so an upstream compiler crash can only take down the file that
# triggered it (and is then reported as that file's failure, not a silent
# truncation of everything after it).
#
# Usage:  tools/run_tests.sh [extra pytest args...]
# Exit:   0 iff every file's pytest run exits 0.
set -u
cd "$(dirname "$0")/.."

files=$(ls tests/test_*.py)
total_pass=0
total_fail=0
failed_files=()
t0=$(date +%s)
for f in $files; do
  out=$(python -m pytest "$f" -q --no-header -p no:cacheprovider "$@" 2>&1)
  rc=$?
  # last summary-ish line, e.g. "23 passed in 4.56s"
  line=$(printf '%s\n' "$out" | grep -E '[0-9]+ (passed|failed|error)' | tail -1)
  if [ $rc -ne 0 ]; then
    total_fail=$((total_fail + 1))
    failed_files+=("$f")
    echo "[FAIL rc=$rc] $f :: ${line:-<no summary — crashed?>}"
    printf '%s\n' "$out" | tail -30
  else
    total_pass=$((total_pass + 1))
    echo "[ok]        $f :: ${line:-0 tests}"
  fi
done
dt=$(( $(date +%s) - t0 ))
echo "----"
if [ $total_fail -eq 0 ]; then
  echo "ALL GREEN: $total_pass files in ${dt}s"
  exit 0
fi
echo "RED: $total_fail of $((total_pass + total_fail)) files failed in ${dt}s: ${failed_files[*]}"
exit 1
