"""Command-line entry points (train/infer for both stages, pipeline, bench)."""
