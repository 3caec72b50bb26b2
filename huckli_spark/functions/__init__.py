"""Scalar kernels (SURVEY S1-S13): base58check keys, uuid formatting,
timestamp heuristics, proto-decimal defaults, portable rounding."""
