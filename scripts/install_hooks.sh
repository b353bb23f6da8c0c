#!/bin/bash
# Idempotently install the repo's git hooks (see precommit_guard.sh).
set -e
cd "$(dirname "$0")/.."
ln -sf ../../scripts/precommit_guard.sh .git/hooks/pre-commit
chmod +x scripts/precommit_guard.sh
echo "installed .git/hooks/pre-commit -> scripts/precommit_guard.sh"
