#!/bin/bash
# Headless-render helper (reference scripts/os_render.sh parity).
#
# The reference needs Xvfb + PYVISTA_OFF_SCREEN because its renderers are
# pygame/VTK windows. This framework renders with matplotlib/numpy into
# rgb_array buffers, so no X server is required — this wrapper exists for
# drop-in compatibility with reference workflows and simply forces the
# headless matplotlib backend before delegating.
set -euo pipefail
export MPLBACKEND=Agg
export SDL_VIDEODRIVER="${SDL_VIDEODRIVER:-dummy}"   # if pygame is ever used
exec "$@"
