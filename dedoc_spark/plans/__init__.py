"""Query plans for the driver correctness gate and benchmarks."""
