"""placeholder — filled in subsequent milestones."""
