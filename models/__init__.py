# Reference-compatible import surface (reference: models/ package).
