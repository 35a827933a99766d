"""Driver-side plans: the wave-iterative crawl pipeline, snapshot
checkpointing, and the payload-validation stage."""
