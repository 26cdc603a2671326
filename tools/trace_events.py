"""Print the top individual XLA ops (not families) from a captured trace,
with their HLO long names — used to attribute aggregate `copy`/`pad`/`slice`
families to specific tensors/layouts in the graph.

Usage: python tools/trace_events.py <trace_dir> [n_runs] [family_filter]
"""

import collections
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    trace_dir = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    family = sys.argv[3] if len(sys.argv) > 3 else None

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for p in xs.planes:
        if not p.name.startswith("/device:"):
            continue
        ev_names = p.event_metadata
        # HLO long names (shapes) live in the metadata display name / stats
        stat_names = {m.id: m.name for m in p.stat_metadata.values()} if hasattr(
            p, "stat_metadata") else {}
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            long_name = {}
            for ev in ln.events:
                md = ev_names[ev.metadata_id]
                name = md.name
                if family and not name.lstrip("%").startswith(family):
                    continue
                tot[name] += ev.duration_ps / 1e9 / n_runs
                cnt[name] += 1
                if name not in long_name:
                    parts = [md.display_name] if md.display_name else []
                    for st in ev.stats:
                        sn = stat_names.get(st.metadata_id, "")
                        if sn in ("long_name", "hlo_op", "expression", "tf_op"):
                            parts.append(str(st.str_value or st.ref_value))
                    long_name[name] = " | ".join(x for x in parts if x)[:240]
            print(f"{p.name}: {sum(tot.values()):.1f} ms/run in filter "
                  f"{family or '<all>'}")
            for name, ms in tot.most_common(40):
                print(f"  {ms:7.3f} ms x{cnt[name] // max(1, n_runs):3d}  {name}")
                if long_name.get(name):
                    print(f"           {long_name[name]}")


if __name__ == "__main__":
    main()
