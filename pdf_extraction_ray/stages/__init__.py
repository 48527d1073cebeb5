"""Ray Data stages: batch UDFs and actor-pool callables."""
