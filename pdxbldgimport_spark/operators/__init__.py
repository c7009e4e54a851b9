"""Engine operators (SURVEY.md §2): spatial joins, conflation rules,
dedup, kNN, tiling, and the training-data-pipeline extras."""
