#!/usr/bin/env bash
# CI pipeline — the analogue of the reference's scripts/init.sh +
# .circleci/config.yml (install, build, full validated benchmark run).
set -euo pipefail
cd "$(dirname "$0")/.."

# CI validates on the CPU backend by default (deterministic, works with
# no/wedged accelerator); export GRAPHTPU_PLATFORM yourself to override.
export GRAPHTPU_PLATFORM="${GRAPHTPU_PLATFORM:-cpu}"

echo "== build native ingest library =="
make -C native

echo "== unit + golden-file + distributed tests (8-device CPU mesh) =="
# -rs prints every skip with its reason; after the native build above the
# expected skip count is ZERO — any skip is a blind spot, so fail on it
python -m pytest tests/ -q -rs | tee /tmp/graphtpu-ci-pytest.log
if grep -E "[0-9]+ skipped" /tmp/graphtpu-ci-pytest.log >/dev/null; then
  echo "CI FAILED: unexpected test skips (see SKIPPED lines above)" >&2
  exit 1
fi

echo "== end-to-end benchmark suite on the example datasets =="
workdir=$(mktemp -d)
repo=$(pwd)
(cd "$workdir" && PYTHONPATH="$repo:${PYTHONPATH:-}" python -m graphtpu.cli benchmark \
  --config "$repo/config-template/benchmark.properties" \
  --intermediate-dir "$workdir/intermediate")

echo "== driver entry points =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

echo "CI PASSED"
