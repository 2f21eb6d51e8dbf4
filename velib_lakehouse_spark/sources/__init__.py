"""Readers/writers: lakehouse layout, generic format IO, retention."""
