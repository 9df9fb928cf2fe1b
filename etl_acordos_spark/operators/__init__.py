"""Relational and LLM-pipeline operators."""
