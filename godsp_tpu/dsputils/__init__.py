"""L0 primitives: conversion, padding, predicates, comparison, Matrix.

TPU-native counterpart of the reference dsputils package
(/root/reference/dsputils/).
"""

from godsp_tpu.dsputils.compare import (
    CLOSE_FACTOR,
    complex_equal,
    float_equal,
    pretty_close,
    pretty_close_2,
    pretty_close_2f,
    pretty_close_c,
    snr_db,
)
from godsp_tpu.dsputils.matrix import (
    Matrix,
    make_empty_matrix,
    make_matrix,
    make_matrix_2,
)
from godsp_tpu.dsputils.utils import (
    detrend,
    is_power_of_2,
    next_power_of_2,
    segment,
    segment_bounds,
    to_complex,
    to_complex_2,
    zero_pad,
    zero_pad_2,
    zero_pad_f,
)

__all__ = [
    "CLOSE_FACTOR",
    "detrend",
    "Matrix",
    "complex_equal",
    "float_equal",
    "is_power_of_2",
    "make_empty_matrix",
    "make_matrix",
    "make_matrix_2",
    "next_power_of_2",
    "pretty_close",
    "pretty_close_2",
    "pretty_close_2f",
    "pretty_close_c",
    "segment",
    "segment_bounds",
    "snr_db",
    "to_complex",
    "to_complex_2",
    "zero_pad",
    "zero_pad_2",
    "zero_pad_f",
]
