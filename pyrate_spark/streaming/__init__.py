"""Structured Streaming tier maintenance (the reference is batch-only;
this is the graft's continuous-aggregate story — SURVEY.md §2.9)."""
