"""Parse a jax.profiler xplane.pb and print per-op device-time totals.

The tensorboard_plugin_profile converter is broken in this image (its
pywrap symbol is missing), so this aggregates XEvent durations directly
from the xplane proto. Usage:

    python scripts/parse_xplane.py <trace.xplane.pb> [top_n]

Events on device planes (/device:TPU*) are grouped by event name; the
long-name stat (tf_op / hlo fusion name) is shown when present.
"""

from __future__ import annotations

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())

    print("planes:", [p.name for p in space.planes])
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # -> ms
                totals[name] += dur
                counts[name] += 1
                plane_total += dur
        print(f"\n== plane {plane.name}: {plane_total:.1f} ms total "
              f"(sum over {len(plane.lines)} lines)")
        for name, ms in totals.most_common(top_n):
            print(f"  {ms:10.2f} ms  x{counts[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
