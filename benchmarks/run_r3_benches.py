"""Run the round-3 on-device benches in ONE process (single TPU client)."""
import sys
sys.argv = ["bench_assembled", sys.argv[1] if len(sys.argv) > 1 else "255"]
import bench_assembled
bench_assembled.main()
sys.argv = ["bench_dg_mm", sys.argv[2] if len(sys.argv) > 2 else "128"]
import bench_dg_mm
bench_dg_mm.main()
