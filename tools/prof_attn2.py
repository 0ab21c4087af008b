import sys; sys.path.insert(0, ".")
from prof_attn import bench
for drop in (0.0, 0.2):
    ms = bench(True, drop)
    print(f"fused=True dropout={drop}: {ms:7.2f} ms/iter (x6 = {6*ms:6.1f} ms)", flush=True)
