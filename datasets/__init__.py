# Reference-compatible import surface (reference: datasets/ package).
# Note: this shadows any pip-installed `datasets` package when the repo root
# is on sys.path — this framework does not use HuggingFace datasets.
