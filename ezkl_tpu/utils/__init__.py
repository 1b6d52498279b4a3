"""Host-side utilities: hashing (keccak256), serialization helpers."""
