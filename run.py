"""Framework entry point (the reference's run.py equivalent)."""
from husky_rover_mppi_isaacsim_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
