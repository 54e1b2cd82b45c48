#!/usr/bin/env bash
# Shared plumbing for experiment scripts (mirrors the reference's
# Scripts/ layout: env-var parameterization, logs/ directory).
set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
ROOT_DIR="$(cd "${SCRIPT_DIR}/.." && pwd)"
LOG_DIR="${ROOT_DIR}/logs"
mkdir -p "${LOG_DIR}"
RUN="python -m sgs_gnn_tpu.run.cli"
