#!/bin/bash
# Mirrors the reference example UX (examples/taylorgreen/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run taylorgreen --out results --draw --density "$@"
