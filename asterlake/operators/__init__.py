"""Pure DataFrame -> DataFrame operators (the engine's transform layer)."""
