"""Training/eval stack: losses, datasets, pipelines, CLIs, fine-tuning."""
