"""raygun-inspect CLI: aggregate logs, pick best checkpoints."""

import json
import sys

from ..eval.inspect_logs import inspect_logs


def main():
    if len(sys.argv) < 2:
        print("usage: raygun-inspect <config.json | folder>", file=sys.stderr)
        sys.exit(1)
    bests = inspect_logs(sys.argv[1])
    print(json.dumps(bests, indent=1, default=str))
