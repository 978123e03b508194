#!/usr/bin/env bash
# Minimum bar before ANY commit (VERDICT r12 #1: an 18-line hunk
# committed without compiling broke every driver gate for a round).
# Full gates (test / Verify / Bench) still apply before claiming an
# operator done — this script is the floor, not the ceiling.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
sbt -batch 'runMain graft.Scratch'
echo "[precommit] OK"
