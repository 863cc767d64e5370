"""Time q_scd2_sequence_replay once on a fresh session; print elapsed."""
import sys
import time

sys.path.insert(0, "/root/repo")

from dbt_scd2_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("time_seq_replay")
    from dbt_scd2_utils_spark import entry

    t0 = time.time()
    df = entry.q_scd2_sequence_replay(spark, "/root/testdata/sf0.001")
    n = df.count()
    dt = time.time() - t0
    print(f"ELAPSED {dt:.2f}s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
