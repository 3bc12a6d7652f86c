"""Planning layer: work-list planner with ledger-based checkpoint/resume,
per-partition lineage, and run metrics (SURVEY.md §2.9, §3.4). Engine-side
capability — the reference is a single-process library with no resume.
"""
