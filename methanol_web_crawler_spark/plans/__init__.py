"""Driver-side crawl plans (the round loop)."""
