"""Driver-artifact guards for __graft_entry__._provision_devices.

The driver validates multi-chip sharding by calling dryrun_multichip(n) in
an environment whose default JAX platform is the axon TPU tunnel. The
provisioning helper must build the virtual CPU mesh WITHOUT initializing
the default backend: the axon PJRT client build blocks indefinitely when
the tunnel is unreachable (observed 2026-08-17), which would hang the
driver's validation run.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestProvisionDevices:
    def test_initialized_backend_path(self):
        """With a backend already initialized on >= n devices, provisioning
        must accept it as-is (jax.devices() is forced first so the test
        exercises the initialized branch regardless of execution order)."""
        sys.path.insert(0, REPO)
        import jax as _jax

        _jax.devices()  # deterministic: initialize the 8-device CPU mesh
        import __graft_entry__ as g

        jax = g._provision_devices(8)
        assert len(jax.devices()) >= 8
        assert jax.devices()[0].platform == "cpu"

    def test_initialized_but_short_reprovisions(self):
        """The clear_backends + re-provision branch (backend initialized on
        FEWER devices than requested) — exercised in a subprocess so the
        suite's own 8-device backend is untouched."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert len(jax.devices()) == 1\n"  # initialized small
            "import __graft_entry__ as g\n"
            "jax = g._provision_devices(4)\n"
            "print('NDEV', len(jax.devices()), jax.devices()[0].platform)\n"
        ) % REPO
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, timeout=180,
            capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("NDEV")]
        assert line and line[0].split()[1:] == ["4", "cpu"], out.stdout

    def test_uninitialized_backend_never_dials_default_platform(self):
        """Fresh interpreter, image-default env (JAX_PLATFORMS=axon): the
        helper must provision the CPU mesh without touching the default
        backend. If it dials the tunnel this hangs far beyond the timeout
        (the PJRT client build has none of its own)."""
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # helper must inject the device count
        # conftest mutates JAX_PLATFORMS=cpu in THIS process; restore the
        # image default so the child actually has the axon plugin as its
        # default platform — the premise the no-dial guard protects
        env["JAX_PLATFORMS"] = "axon"
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import __graft_entry__ as g\n"
            "jax = g._provision_devices(4)\n"
            "print('NDEV', len(jax.devices()), jax.devices()[0].platform)\n"
        ) % REPO
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, timeout=180,
            capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        line = [l for l in out.stdout.splitlines() if l.startswith("NDEV")]
        assert line and line[0].split()[1:] == ["4", "cpu"], out.stdout
