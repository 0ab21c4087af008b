"""Training loops, losses, schedules, and checkpointing."""
