"""Logical operators (SURVEY.md §2): search verbs, index families,
result shaping, and the training-data-pipeline extensions."""
