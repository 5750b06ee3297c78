"""DataFrame -> DataFrame operators. Each is pure, lazy, and composable."""
