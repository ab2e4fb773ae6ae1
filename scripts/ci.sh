#!/usr/bin/env bash
# CI entry point: install + fast test tier on a virtual 8-device CPU mesh.
#
# The full suite (`pytest tests/`) takes ~19 min on CPU; the fast tier
# (`-m "not slow"`) is the ~3 min smoke gate (measured 2:52 on this
# single-core box).  tests/conftest.py self-configures the 8-device CPU
# mesh in-process, but we also force the platform via env so CI boxes
# with TPU plugins behave identically.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pip install -e '.[test]' --quiet

export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
python -m pytest tests/ -x -q -m "not slow" "$@"

# Multihost launcher must at least dryrun (coordinator wiring, mesh
# construction) so the runbook entry point cannot rot.
python scripts/launch_multihost.py --dryrun
