"""Injected-client tests for the object-store bootstrap (SURVEY §2.1 S7,
reference src/create_bucket.py:28-35). No boto3, no network — the client
contract is create_bucket(Bucket=...) plus botocore-shaped errors."""

from __future__ import annotations

import pytest

from asterlake.sources.bootstrap import ensure_bucket, make_client
from asterlake.session import ObjectStoreConfig


class _ClientError(Exception):
    """botocore.exceptions.ClientError shape: .response['Error']['Code']."""

    def __init__(self, code: str) -> None:
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class FakeClient:
    def __init__(self, existing: set[str] | None = None, fail_code: str | None = None):
        self.buckets = set(existing or ())
        self.fail_code = fail_code
        self.calls: list[str] = []

    def create_bucket(self, *, Bucket: str):  # noqa: N803 — boto3 contract
        self.calls.append(Bucket)
        if self.fail_code:
            raise _ClientError(self.fail_code)
        if Bucket in self.buckets:
            raise _ClientError("BucketAlreadyOwnedByYou")
        self.buckets.add(Bucket)


def test_creates_missing_bucket():
    client = FakeClient()
    assert ensure_bucket(client, "lake") is True
    assert client.buckets == {"lake"}


def test_existing_bucket_is_idempotent_success():
    for code in ("BucketAlreadyOwnedByYou", "BucketAlreadyExists"):
        client = FakeClient(fail_code=code)
        assert ensure_bucket(client, "lake") is False
        assert client.calls == ["lake"]


def test_double_ensure_is_idempotent():
    client = FakeClient()
    assert ensure_bucket(client, "lake") is True
    assert ensure_bucket(client, "lake") is False


def test_real_errors_propagate():
    client = FakeClient(fail_code="AccessDenied")
    with pytest.raises(_ClientError):
        ensure_bucket(client, "lake")
    # non-botocore exceptions (no .response) also propagate
    class Boom:
        def create_bucket(self, *, Bucket: str):  # noqa: N803
            raise RuntimeError("connection refused")

    with pytest.raises(RuntimeError):
        ensure_bucket(Boom(), "lake")


def test_make_client_requires_boto3_or_raises():
    cfg = ObjectStoreConfig(endpoint="minio:9000", access_key="k", secret_key="s")
    try:
        import boto3  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="boto3"):
            make_client(cfg)
    else:  # pragma: no cover - env-dependent
        assert make_client(cfg) is not None
