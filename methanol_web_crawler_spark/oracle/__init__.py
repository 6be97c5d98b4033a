"""Pure-Python single-process reference crawler (the golden oracle)."""
