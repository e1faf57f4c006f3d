from .hashing import hash32, shingles, minhash_signature  # noqa: F401
