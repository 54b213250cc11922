#!/bin/bash
# Mirrors the reference example UX (examples/smoke_obs/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run smoke_obs --out results --draw --density "$@"
