#!/bin/bash
# Mirrors the reference example UX (examples/karman3d/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run karman3d --out results --draw --density "$@"
