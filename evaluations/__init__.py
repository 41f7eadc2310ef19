# Reference-compatible import surface (reference: evaluations/ package).
