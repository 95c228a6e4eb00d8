"""Filled in later milestones."""
