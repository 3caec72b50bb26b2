"""Source layer: file listing with lower-bound pushdown, gzip
length-delimited framing, and protobuf wire decode.

This is the only genuinely custom I/O in the engine — everything
relational above it is stock Spark (SURVEY §4: "No custom Catalyst
rules or strategies are required for parity").
"""
