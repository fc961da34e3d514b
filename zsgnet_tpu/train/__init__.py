"""Training/eval runtime: Learner, evaluator, checkpointing, metrics."""
