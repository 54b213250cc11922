#!/bin/bash
# Mirrors the reference example UX (examples/jpipe/run.sh): simulate at the
# scene's catalog hyperparameters, then replay density/export.
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run jpipe --out results --draw --density "$@"
