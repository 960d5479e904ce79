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
        """In the test process a CPU backend is already initialized on 8
        virtual devices (conftest): provisioning must accept it as-is."""
        sys.path.insert(0, REPO)
        import __graft_entry__ as g

        jax = g._provision_devices(8)
        assert len(jax.devices()) >= 8
        assert jax.devices()[0].platform == "cpu"

    def test_uninitialized_backend_never_dials_default_platform(self):
        """Fresh interpreter, image-default env (JAX_PLATFORMS=axon): the
        helper must provision the CPU mesh without touching the default
        backend. If it dials the tunnel this hangs far beyond the timeout
        (the PJRT client build has none of its own)."""
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # helper must inject the device count
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
