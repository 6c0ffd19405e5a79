#!/bin/bash
# Round-close ritual (round-11 verdict item 7): the leak scan must stamp
# the ACTUAL closing commit — i.e. nothing may land after the scan. This
# script makes the scan itself the final act:
#   1. commit everything pending (the caller's message),
#   2. run tools/leakscan.py against that tree,
#   3. commit LEAKCHECK.json as the last commit of the round, whose
#      parent is exactly the scanned commit.
# Usage: tools/close_round.sh "<round-close commit message>"
set -euo pipefail
cd /root/repo
# self-heal the pre-commit leak-scan hook (round-12 verdict item 5): every
# source-touching commit — including any "post-close" fix — re-runs the
# scan on its own tree, so the stamp can never lag the code again
tools/install_hooks.sh
msg="${1:-round close}"
if ! git diff --quiet || ! git diff --cached --quiet || \
   [ -n "$(git status --porcelain)" ]; then
  git add -A
  git commit -m "$msg"
fi
python3 tools/leakscan.py > LEAKCHECK.json
git add LEAKCHECK.json
git commit -m "Stamp leak scan at the round-closing commit"
echo "scanned_commit in LEAKCHECK.json:"
python3 -c "import json; print(json.load(open('LEAKCHECK.json')).get('scanned_commit'))"
echo "HEAD^ (must match):"
git rev-parse HEAD^
