from btrdb_server_spark.plans.rollup import RollupLadder, rollup_from_points

__all__ = ["RollupLadder", "rollup_from_points"]
