#!/bin/bash
# Mirrors examples/smoke3d/run.sh: the 3D plume scene ("smoke" source).
cd "$(dirname "$0")/../.."
time python -m nmcfluid.run smoke --out results --draw --density "$@"
