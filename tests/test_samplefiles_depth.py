"""Sample-file fetch helper + figure sharing: reference port.

Behavior matrix of /root/reference/tests/test_samplefiles.py (4
tests) and the share_fig_ax portion of test_plotting.py: cache-hit
short-circuits, download-on-miss, the DAT alias, lowercase remote
names, and figure/axes sharing semantics.
"""
import io

import matplotlib
matplotlib.use('Agg')
from matplotlib import pyplot as plt

import pytest

import jax  # NOQA: F401

from prysm_tpu import sample_data
from prysm_tpu.plotting import share_fig_ax


def test_fetch_if_not_present_returns_existing_file_without_fetching(
        tmp_path, monkeypatch):
    local = tmp_path / 'cached.txt'
    local.write_text('already here')

    def fail_if_called(remote):
        raise AssertionError(f'urlopen called for {remote}')

    monkeypatch.setattr(sample_data, 'urlopen', fail_if_called)
    assert sample_data.fetch_if_not_present(
        local, 'https://example.com/cached.txt') == local
    assert local.read_text() == 'already here'


def test_fetch_if_not_present_downloads_missing_file(tmp_path, monkeypatch):
    class Response(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, exc_type, exc, tb):
            self.close()

    local = tmp_path / 'downloaded.txt'

    def fake_urlopen(remote):
        assert remote == 'https://example.com/downloaded.txt'
        return Response(b'fresh data')

    monkeypatch.setattr(sample_data, 'urlopen', fake_urlopen)
    assert sample_data.fetch_if_not_present(
        local, 'https://example.com/downloaded.txt') == local
    assert local.read_bytes() == b'fresh data'


def test_sample_files_dat_alias_uses_named_file(tmp_path, monkeypatch):
    calls = []

    def fake_fetch(local, remote):
        calls.append((local, remote))
        return local

    monkeypatch.setattr(sample_data, 'root', tmp_path)
    monkeypatch.setattr(sample_data, 'fetch_if_not_present', fake_fetch)
    out = sample_data.SampleFiles()('DAT')
    expected = (tmp_path / 'valid_zygo_dat_file.dat').absolute()
    assert out == expected
    assert calls == [
        (expected, sample_data.baseremote + 'valid_zygo_dat_file.dat')]


def test_sample_files_generic_filename_uses_lowercase_remote(tmp_path,
                                                             monkeypatch):
    calls = []

    def fake_fetch(local, remote):
        calls.append((local, remote))
        return local

    monkeypatch.setattr(sample_data, 'root', tmp_path)
    monkeypatch.setattr(sample_data, 'fetch_if_not_present', fake_fetch)
    out = sample_data.SampleFiles()('Boat.PNG')
    expected = tmp_path / 'boat.png'
    assert out == expected
    assert calls == [(expected, sample_data.baseremote + 'boat.png')]


# ---------- share_fig_ax ------------------------------------------------------

def test_share_fig_ax_figure_number_remains_unchanged():
    fig, ax = plt.subplots()
    fig2, _ = share_fig_ax(fig, ax)
    assert fig.number == fig2.number
    plt.close(fig)


def test_share_fig_ax_produces_an_axis():
    fig, ax = share_fig_ax()
    assert ax is not None
    plt.close(fig)


def test_share_fig_ax_returns_what_it_is_given():
    fig, ax = plt.subplots()
    fig2, ax2 = share_fig_ax(fig, ax)
    assert fig2 is fig
    assert ax2 is ax
    plt.close(fig)
