"""Relational operators (DataFrame -> DataFrame transformations)."""
