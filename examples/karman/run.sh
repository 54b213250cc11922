#!/bin/bash
# Mirrors the reference example UX (examples/karman/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run karman --out results --draw --density "$@"
