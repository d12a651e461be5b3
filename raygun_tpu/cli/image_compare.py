"""raygun-images-compare CLI."""

import sys

from ..eval.image_metrics import images_compare


def main():
    if len(sys.argv) < 2:
        print("usage: raygun-images-compare <config.json>", file=sys.stderr)
        sys.exit(1)
    images_compare(sys.argv[1])
