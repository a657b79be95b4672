"""Command-line interface.

Mirrors the reference CLI surface (lotad/cli.py:66-108): ``run`` executes a
config-driven full-database comparison and prints the drift report;
``suggest-ignore-columns`` is the wizard's analytic core
(lotad/config_wizard.py:101-147) as a non-interactive command.

    python -m lotad_spark.cli run --config compare.yaml
    python -m lotad_spark.cli run --db1 /data/db1 --db2 /data/db2 --output out
    python -m lotad_spark.cli suggest-ignore-columns --db1 ... --db2 ... -t customer
"""

from __future__ import annotations

from datetime import datetime

import click

from lotad_spark.config import Config, comparator_from_config
from lotad_spark.session import get_spark


@click.group()
def cli() -> None:
    """lotad_spark — PySpark-native database drift diff."""


@cli.command()
@click.option("--config", "config_path", type=click.Path(exists=True), default=None)
@click.option("--db1", "db1_path", type=click.Path(exists=True), default=None)
@click.option("--db2", "db2_path", type=click.Path(exists=True), default=None)
@click.option("--output", "output_path", default="drift_analysis_out")
@click.option("--ignore-dates", is_flag=True, default=False)
@click.option("--target-table", "target_tables", multiple=True)
@click.option("--ignore-table", "ignore_tables", multiple=True)
def run(
    config_path, db1_path, db2_path, output_path, ignore_dates,
    target_tables, ignore_tables,
) -> None:
    """Compare two parquet-directory databases and print the drift report."""
    if config_path:
        config = Config.load(config_path)
    elif db1_path and db2_path:
        config = Config(
            db1_path=db1_path,
            db2_path=db2_path,
            output_path=output_path,
            ignore_dates=ignore_dates,
            target_tables=list(target_tables),
            ignore_tables=list(ignore_tables),
        )
    else:
        raise click.UsageError("provide --config or both --db1 and --db2")

    start = datetime.now()
    spark = get_spark("lotad_spark_cli")
    result = comparator_from_config(spark, config).compare_all()
    click.echo(result.report())
    click.echo(f"\nCompleted in {(datetime.now() - start).total_seconds():.1f}s")


@cli.command("suggest-ignore-columns")
@click.option("--db1", "db1_path", type=click.Path(exists=True), required=True)
@click.option("--db2", "db2_path", type=click.Path(exists=True), required=True)
@click.option("--table", "-t", "tables", multiple=True)
def suggest_ignore_columns_cmd(db1_path, db2_path, tables) -> None:
    """Suggest per-table ignore_column rules (zero value overlap)."""
    from lotad_spark.sources.parquet import ParquetDatabase
    from lotad_spark.wizard import suggest_ignore_columns

    spark = get_spark("lotad_spark_wizard")
    db1 = ParquetDatabase(spark, db1_path, "db1")
    db2 = ParquetDatabase(spark, db2_path, "db2")
    names = list(tables) or sorted(
        set(db1.list_tables()) & set(db2.list_tables())
    )
    for t in names:
        cols = suggest_ignore_columns(db1.table(t), db2.table(t))
        for c in cols:
            click.echo(f"{t}: {c}")


@cli.command()
@click.option("--config", "config_path", default=None)
def wizard(config_path) -> None:
    """Interactive config builder (reference lotad/config_wizard.py menu)."""
    from lotad_spark.config_wizard import ConfigWizard

    ConfigWizard.cli_start(config_path)


@cli.command()
@click.option("--config", "config_path", default=None)
def setup(config_path) -> None:
    """Alias for ``wizard`` — the reference's command name
    (lotad/cli.py:16-22)."""
    from lotad_spark.config_wizard import ConfigWizard

    ConfigWizard.cli_start(config_path)


if __name__ == "__main__":
    cli()
