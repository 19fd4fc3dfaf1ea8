#!/usr/bin/env bash
# Fast-tier suite, parallelized across processes by test FILE (no
# pytest-xdist dependency).  Each worker is a plain serial pytest over a
# file group balanced by measured cost; exit code is non-zero if any
# group fails.  Typical wall time on 4 cores: ~4-5 min (vs ~13 min
# serial).  Usage: tools/test_fast.sh [n_workers]
set -u
cd "$(dirname "$0")/.."
N="${1:-4}"

# Groups balanced from the recorded --durations profile (heaviest first).
GROUPS_LIST=(
  "tests/test_cm_pipeline.py tests/test_golden_fixtures.py tests/test_chunked.py tests/test_fuzz.py"
  "tests/test_sharded_general_pack.py tests/test_sharded_encode.py tests/test_sharding.py tests/test_sharded_pack.py tests/test_device_stuff.py tests/test_scan_domain.py"
  "tests/test_device_entropy.py tests/test_pack_v2.py tests/test_entropy.py tests/test_libjpeg_parity.py"
  "tests/test_pallas_pack.py tests/test_pallas_fdct.py tests/test_roundtrip.py tests/test_api.py tests/test_color.py tests/test_fdct.py tests/test_quality.py tests/test_tables.py tests/test_decoder_roundtrip.py tests/test_tpu.py"
)

pids=()
i=0
for g in "${GROUPS_LIST[@]}"; do
  if [ "$N" -le 1 ]; then
    python -m pytest $g -q -n0 || exit 1
  else
    python -m pytest $g -q -n0 >"/tmp/tpuenc_test_g$i.log" 2>&1 &
    pids+=($!)
  fi
  i=$((i + 1))
done

rc=0
i=0
for p in "${pids[@]:-}"; do
  [ -z "$p" ] && continue
  if ! wait "$p"; then
    rc=1
    echo "=== group $i FAILED ==="
  fi
  tail -2 "/tmp/tpuenc_test_g$i.log"
  i=$((i + 1))
done
exit $rc
