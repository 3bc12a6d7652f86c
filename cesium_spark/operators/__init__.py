"""Engine operators: series derivation, tiered rollup, gap-fill, tier
folding, plus the training-data-pipeline operator suite (dedup,
similarity search, text analysis, multimodal plumbing).
"""
