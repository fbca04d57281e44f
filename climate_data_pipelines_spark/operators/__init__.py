"""Composable operators: every capability is ``DataFrame -> DataFrame``."""
