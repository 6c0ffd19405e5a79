#!/bin/bash
# Install the versioned git hooks into .git/hooks (not versioned by git
# itself). Run once per clone; tools/close_round.sh also calls this so
# the round-close ritual self-heals a missing installation.
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
install -m 755 tools/pre-commit .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (leak-scan-on-every-source-commit)"
