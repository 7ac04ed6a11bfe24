"""Function library: deterministic text extraction, hashing/sketches, vector math."""
