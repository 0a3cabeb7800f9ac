#!/bin/bash
# Round-4 parity burn-in queue: one TPU tier at a time (the tunnel admits
# one owner), each tier under its own wall-clock cap so the queue always
# terminates before the round ends.  Logs: .parity_r4_tpu_<tier>.log
cd /root/repo
P="python -u -m pytest -q -rA --tb=line -p no:cacheprovider"

run_tier () {  # name, budget_s, cap_s, pytest-args...
  name=$1; budget=$2; cap=$3; shift 3
  echo "=== tier $name (budget ${budget}s, cap ${cap}s) $(date -u +%H:%M:%S) ==="
  DDO_TEST_TPU=1 DDO_TEST_BUDGET=$budget timeout "$cap" \
    $P "$@" > ".parity_r4_tpu_${name}.log" 2>&1
  echo "EXIT=$?" >> ".parity_r4_tpu_${name}.log"
}

case "$1" in
  alp)
    run_tier alp 240 4500 "tests/slow/test_reference_parity.py::test_alp" -m "slow and not big"
    ;;
  psp)
    run_tier psp 180 4500 "tests/slow/test_reference_parity.py::test_psp" -m "slow and not big"
    ;;
  tsptw_spb)
    run_tier tsptw_spb 450 3600 "tests/slow/test_reference_parity.py::test_tsptw" -m "slow and not big" -k "SolomonPotvinBengio"
    ;;
  golomb)
    run_tier golomb 450 2400 "tests/slow/test_reference_parity.py::test_golomb" -m "slow and not big"
    ;;
  heavies)
    run_tier heavies 600 5400 "tests/slow/test_reference_parity.py" -m "slow and not big" \
      -k "keller4 or brock200_4 or hamming8-4 or ESC25 or br17_10 or br17.10 or film103 or knapPI_3_2000"
    ;;
  srflp_sop)
    run_tier srflp_sop 450 4200 "tests/slow/test_reference_parity.py" -m "slow and not big" \
      -k "test_srflp or test_sop"
    ;;
  misp)
    run_tier misp 450 4200 "tests/slow/test_reference_parity.py::test_misp" -m "slow and not big"
    ;;
  talentsched)
    run_tier talentsched 450 3000 "tests/slow/test_reference_parity.py::test_talentsched" -m "slow and not big"
    ;;
  *)
    echo "usage: _burnin_r4.sh <tier>"; exit 2;;
esac
