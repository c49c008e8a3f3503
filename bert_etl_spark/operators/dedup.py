"""dedup operators — filled in by later milestones (see tasks M4-M8)."""
