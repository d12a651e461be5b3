"""raygun-segment CLI (parity: reference setup.cfg:67-79 console script)."""

import sys

from ..seg.segment import segment


def main():
    if len(sys.argv) < 2:
        print("usage: raygun-segment <seg_config.json>", file=sys.stderr)
        sys.exit(1)
    segment(sys.argv[1])


if __name__ == "__main__":
    main()
