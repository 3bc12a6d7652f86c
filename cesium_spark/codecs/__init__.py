"""Time-series compression codecs: delta-of-delta timestamps + Gorilla
XOR values (Pelkonen et al., VLDB 2015), as vectorized numpy bit-packing
kernels dispatched over salted, range-partitioned chunks
(SURVEY.md §2.9; BASELINE.json north_star). Engine-side capability —
the reference persists raw arrays (.npz) with no compression.
"""
