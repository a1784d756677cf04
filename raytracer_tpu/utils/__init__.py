"""Host utilities: coords, IO, plotting, timing."""
