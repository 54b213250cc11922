#!/bin/bash
# Mirrors the reference example UX (examples/vortex_collide/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run vortex_collide --out results --draw --density "$@"
