"""Query builders: one module per workload family."""
