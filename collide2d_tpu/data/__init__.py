"""Dataset pipeline: generation, relabeling, z-test validation, balancing, viz."""
