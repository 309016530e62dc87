"""Multi-device scale-out: mesh construction, block sharding, and the
ring-rotation overlap step (SURVEY.md §2.10: the reference's block-pair
job matrix becomes A-shards resident per chip with B-shards rotating
over ICI via ppermute)."""
