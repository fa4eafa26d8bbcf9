"""Native (C++) runtime components. See vec_mujoco.cc + build.py."""
