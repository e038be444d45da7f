"""Host-side utilities: visualization, video export."""
