"""Operator layer: SURVEY.md §2 shapes as parameterized DataFrame ops."""
