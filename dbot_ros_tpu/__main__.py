"""``python -m dbot_ros_tpu`` — the node-executable surface (R1-R4)."""

import sys

from dbot_ros_tpu.runtime.cli import main

if __name__ == "__main__":
    sys.exit(main())
