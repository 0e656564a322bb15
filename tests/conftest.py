import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, shuffle_partitions=8, app_name="nss-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pd():
    from neural_search_spark.transcripts import generate_transcripts

    return generate_transcripts(n_convs=400, seed=42)  # ~2k turns


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory, transcripts_pd):
    p = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    transcripts_pd.to_parquet(p, index=False)
    return str(p)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_path):
    return spark.read.parquet(transcripts_path)
