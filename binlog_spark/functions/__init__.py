"""Engine-agnostic function implementations shared with the oracles."""
