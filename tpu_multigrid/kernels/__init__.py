# Pallas TPU kernels (SURVEY.md §7 stage 3). Imported lazily by cycles.
