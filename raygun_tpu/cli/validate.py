"""raygun-run-validation / raygun-validate-* CLIs (parity: reference
setup.cfg:67-79 console scripts)."""

import sys

from ..eval.validate import run_validation, validate_affinities, validate_segmentation


def run_validation_main():
    run_validation()


def validate_affinities_main():
    validate_affinities()


def validate_segmentation_main():
    validate_segmentation()
