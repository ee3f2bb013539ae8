from .skid_steer import (
    DiffDriveLimits,
    inverse_diff_drive,
    wheel_lag_matmul,
    wheel_lag_scan,
)

__all__ = [
    "DiffDriveLimits",
    "inverse_diff_drive",
    "wheel_lag_matmul",
    "wheel_lag_scan",
]
