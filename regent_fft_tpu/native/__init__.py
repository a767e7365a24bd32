"""Native (C++) planner components, loaded via ctypes."""
