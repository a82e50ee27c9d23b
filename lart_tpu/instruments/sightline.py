"""Sight-line optical-depth / column-density maps.

Rebuilds make_sightline_tau (reference: src/sightline_tau_rect.f90:11-340,
standalone driver src/make_sightline_tau.f90): for each observer pixel, a ray
from the observer through the pixel center (inverse TAN), clipped to the box,
integrating tau_gas(nu, pix) for every frequency bin, N_gas(pix), and
tau_dust(pix).  On TPU the (pixel, frequency) product becomes one dense lane
batch walked in lockstep -- embarrassingly parallel, no MPI pixel-striping
needed.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.transfer import to_host

from ..config import ResolvedConfig
from ..grid.cartesian import GridMeta
from .observer import ObserverDevice, ObserverSetMeta

RAD2DEG = 180.0 / math.pi
BIG = jnp.float32(3.0e38)


def make_sightline(cfg: ResolvedConfig, meta: GridMeta, obs: ObserverSetMeta,
                   cmeta=None):
    """Returns sightline(grid, odev, iobs) -> dict of maps."""
    par = cfg.par
    if meta.grid_type == 'clump':
        return _make_sightline_clump(cfg, meta, obs, cmeta)
    if meta.grid_type == 'amr':
        return _make_sightline_amr(cfg, meta, obs)
    from ..transport.engine import (cell_Dfreq, cell_rhokap, cell_rhokapD,
                                    cell_velocity_dot, cell_voigt_a,
                                    line_profile)
    nx, ny, nz = meta.nx, meta.ny, meta.nz
    dx, dy, dz = meta.dx, meta.dy, meta.dz
    xmn, ymn, zmn = meta.xmin, meta.ymin, meta.zmin
    xmx, ymx, zmx = xmn + nx * dx, ymn + ny * dy, zmn + nz * dz
    max_steps = 2 * (nx + ny + nz) + 8

    def integrate(grid, x, y, z, kx, ky, kz, xfreq, mode, cap=None):
        """Walk rays accumulating: mode 0 = gas line tau at comoving xfreq
        (with comoving updates), 1 = N_gas column, 2 = dust tau.  `cap`
        limits the path length (raytrace_to_dist contract; used by the
        interior HEALPix maps, sightline_tau_heal.f90:12-146)."""

        ic = jnp.clip(jnp.floor((x - xmn) / dx).astype(jnp.int32), 0, nx - 1)
        jc = jnp.clip(jnp.floor((y - ymn) / dy).astype(jnp.int32), 0, ny - 1)
        kc = jnp.clip(jnp.floor((z - zmn) / dz).astype(jnp.int32), 0, nz - 1)

        def cond(c):
            (_, _, _, _, _, _, _, _, live), n = c
            return jnp.logical_and(n < max_steps, jnp.any(live))

        def body(c):
            (x, y, z, ic, jc, kc, trav, acc, live), n = c
            xf = acc[1]
            D_cell = cell_Dfreq(grid, meta, ic, jc, kc)
            if mode == 0:
                a_cell = cell_voigt_a(grid, meta, ic, jc, kc)
                rho = cell_rhokap(grid, meta, ic, jc, kc) \
                    * line_profile(cfg, xf, a_cell, D_cell)
            elif mode == 1:
                rho = (cell_rhokap(grid, meta, ic, jc, kc) * D_cell
                       / cfg.line.cross0)
            else:
                rho = cell_rhokapD(grid, meta, ic, jc, kc) \
                    if meta.has_dust else jnp.zeros_like(x)

            def fd(pos, k, idx, amin, d):
                up = k > 0.0
                face = amin + jnp.where(up, idx + 1, idx
                                        ).astype(jnp.float32) * d
                t = (face - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                             jnp.float32(1.0), k)
                return jnp.where(jnp.abs(k) < 1e-12, BIG,
                                 jnp.maximum(t, 0.0))

            tx = fd(x, kx, ic, xmn, dx)
            ty = fd(y, ky, jc, ymn, dy)
            tz = fd(z, kz, kc, zmn, dz)
            dmin = jnp.minimum(jnp.minimum(tx, ty), tz)
            axis = jnp.where(dmin == tx, 0, jnp.where(dmin == ty, 1, 2))
            if cap is not None:
                dleft = jnp.maximum(cap - trav, 0.0)
                hit_cap = dmin >= dleft
                dstep = jnp.minimum(dmin, dleft)
            else:
                hit_cap = jnp.zeros_like(live)
                dstep = dmin
            tau = jnp.where(live, acc[0] + dstep * rho, acc[0])

            icn = jnp.where(jnp.logical_and(live, axis == 0),
                            ic + jnp.where(kx > 0, 1, -1), ic)
            jcn = jnp.where(jnp.logical_and(live, axis == 1),
                            jc + jnp.where(ky > 0, 1, -1), jc)
            kcn = jnp.where(jnp.logical_and(live, axis == 2),
                            kc + jnp.where(kz > 0, 1, -1), kc)
            out = jnp.logical_or(
                jnp.logical_or(icn < 0, icn >= nx),
                jnp.logical_or(jnp.logical_or(jcn < 0, jcn >= ny),
                               jnp.logical_or(kcn < 0, kcn >= nz)))
            xn = jnp.where(live, x + dmin * kx, x)
            yn = jnp.where(live, y + dmin * ky, y)
            zn = jnp.where(live, z + dmin * kz, z)
            if mode == 0 and (not meta.static_medium
                              or not meta.uniform_temperature):
                icn_s = jnp.clip(icn, 0, nx - 1)
                jcn_s = jnp.clip(jcn, 0, ny - 1)
                kcn_s = jnp.clip(kcn, 0, nz - 1)
                u1 = cell_velocity_dot(grid, meta, ic, jc, kc, kx, ky, kz)
                u2 = cell_velocity_dot(grid, meta, icn_s, jcn_s, kcn_s,
                                       kx, ky, kz)
                D2 = cell_Dfreq(grid, meta, icn_s, jcn_s, kcn_s)
                xf = jnp.where(jnp.logical_and(live, ~out),
                               (xf + u1) * D_cell / D2 - u2, xf)
            live = jnp.logical_and(live, ~out)
            live = jnp.logical_and(live, ~hit_cap)
            trav_n = jnp.where(live, trav + dstep, trav)
            return ((xn, yn, zn, jnp.clip(icn, 0, nx - 1),
                     jnp.clip(jcn, 0, ny - 1), jnp.clip(kcn, 0, nz - 1),
                     trav_n, (tau, xf), live), n + 1)

        live0 = jnp.ones_like(x, bool)
        carry = ((x, y, z, ic, jc, kc, jnp.zeros_like(x),
                  (jnp.zeros_like(x), xfreq), live0), jnp.int32(0))
        (out, _) = jax.lax.while_loop(cond, body, carry)
        return out[7][0]

    def ray_origins(odev: ObserverDevice, iobs: int):
        """Pixel-center rays from the observer, clipped to the box entry
        point (sightline_tau_rect.f90:44-75)."""
        R = to_host(odev.rmat[iobs])
        pos = to_host(odev.pos[iobs])
        ii, jj = np.meshgrid(np.arange(obs.nxim), np.arange(obs.nyim),
                             indexing='ij')
        ang_x = (ii + 0.5 - obs.nxim / 2.0) * obs.dxim / RAD2DEG
        ang_y = (jj + 0.5 - obs.nyim / 2.0) * obs.dyim / RAD2DEG
        # inverse TAN: direction in observer frame, then rotate to grid
        kx_o = -np.tan(ang_x)
        ky_o = -np.tan(ang_y)
        kz_o = -np.ones_like(kx_o)
        nrm = np.sqrt(kx_o ** 2 + ky_o ** 2 + kz_o ** 2)
        kobs = np.stack([kx_o / nrm, ky_o / nrm, kz_o / nrm])
        kgrid = np.einsum('ji,jkl->ikl', R, kobs)   # R^T k_obs
        k = kgrid.reshape(3, -1)
        o = pos[:, None] * np.ones_like(k)
        # clip to box: parametric entry t0
        with np.errstate(divide='ignore', invalid='ignore'):
            t_lo = (np.array([xmn, ymn, zmn])[:, None] - o) / k
            t_hi = (np.array([xmx, ymx, zmx])[:, None] - o) / k
        t_near = np.minimum(t_lo, t_hi)
        t_far = np.maximum(t_lo, t_hi)
        t0 = np.nanmax(np.where(np.isfinite(t_near), t_near, -np.inf),
                       axis=0)
        t1 = np.nanmin(np.where(np.isfinite(t_far), t_far, np.inf), axis=0)
        hit = (t1 > t0) & (t0 > 0)
        eps = 1e-6 * (xmx - xmn)
        start = o + (t0 + eps)[None, :] * k
        return start, k, hit

    def ray_origins_inside(odev: ObserverDevice, iobs: int):
        """Interior all-sky map: for each HEALPix pixel direction, the ray
        starts at the box boundary and integrates back toward the observer
        ('from the distant universe toward Earth',
        sightline_tau_heal.f90:33-112).  Returns (start, k, hit, cap)."""
        from .healpix import pix2vec_ring
        pos = to_host(odev.pos[iobs], np.float64)
        vx, vy, vz = pix2vec_ring(obs.nside, np.arange(obs.npix))
        kout = np.stack([to_host(vx, np.float64),
                         to_host(vy, np.float64),
                         to_host(vz, np.float64)])
        with np.errstate(divide='ignore', invalid='ignore'):
            t_lo = (np.array([xmn, ymn, zmn])[:, None] - pos[:, None]) / kout
            t_hi = (np.array([xmx, ymx, zmx])[:, None] - pos[:, None]) / kout
        t_pos = np.where(np.isfinite(t_lo) & (t_lo > 0), t_lo, np.inf)
        t_pos = np.minimum(t_pos,
                           np.where(np.isfinite(t_hi) & (t_hi > 0),
                                    t_hi, np.inf))
        dist = t_pos.min(axis=0)
        hit = np.isfinite(dist)
        dist = np.where(hit, dist, 0.0)
        eps = 1e-6 * (xmx - xmn)
        start = pos[:, None] + (dist - eps)[None, :] * kout
        return start, -kout, hit, dist

    def sightline(grid, odev: ObserverDevice, iobs: int = 0) -> Dict:
        if obs.inside:
            start, k, hit, dist = ray_origins_inside(odev, iobs)
            cap = jnp.asarray(dist, jnp.float32)
        else:
            start, k, hit = ray_origins(odev, iobs)
            cap = None
        npix = start.shape[1]
        x = jnp.asarray(start[0], jnp.float32)
        y = jnp.asarray(start[1], jnp.float32)
        z = jnp.asarray(start[2], jnp.float32)
        kx = jnp.asarray(k[0], jnp.float32)
        ky = jnp.asarray(k[1], jnp.float32)
        kz = jnp.asarray(k[2], jnp.float32)
        hitj = jnp.asarray(hit)

        # N_gas and tau_dust: one ray per pixel
        N_gas = integrate(grid, x, y, z, kx, ky, kz,
                          jnp.zeros_like(x), mode=1, cap=cap)
        tau_dust = integrate(grid, x, y, z, kx, ky, kz,
                             jnp.zeros_like(x), mode=2, cap=cap)

        # tau_gas(nu, pix): loop over frequency bins (jitted per batch)
        xf_axis = meta.xfreq_min + (np.arange(meta.nxfreq) + 0.5) \
            * meta.dxfreq

        f = jax.jit(lambda xf0: integrate(grid, x, y, z, kx, ky, kz,
                                          xf0, mode=0, cap=cap))
        taus = []
        for ixf in range(meta.nxfreq):
            # lab-frame frequency -> comoving at the entry cell
            xf0 = jnp.full((npix,), float(xf_axis[ixf]), jnp.float32)
            if not meta.static_medium or not meta.uniform_temperature:
                from ..transport.engine import (cell_Dfreq as _cD,
                                                cell_velocity_dot as _cv)
                ic = jnp.clip(jnp.floor((x - xmn) / dx).astype(jnp.int32),
                              0, nx - 1)
                jc = jnp.clip(jnp.floor((y - ymn) / dy).astype(jnp.int32),
                              0, ny - 1)
                kc = jnp.clip(jnp.floor((z - zmn) / dz).astype(jnp.int32),
                              0, nz - 1)
                D1 = _cD(grid, meta, ic, jc, kc)
                u1 = _cv(grid, meta, ic, jc, kc, kx, ky, kz)
                xf0 = xf0 * (meta.Dfreq_ref / D1) - u1
            taus.append(to_host(f(xf0)))
        tau_gas = np.stack(taus).reshape(meta.nxfreq, obs.nxim, obs.nyim)

        hitm = to_host(hitj).reshape(obs.nxim, obs.nyim)
        return {
            'tau_gas': np.where(hitm[None], tau_gas, 0.0),
            'N_gas': np.where(hitm, to_host(N_gas).reshape(
                obs.nxim, obs.nyim), 0.0),
            'tau_dust': np.where(hitm, to_host(tau_dust).reshape(
                obs.nxim, obs.nyim), 0.0),
        }

    return sightline


def write_sightline_tau(filename: str, maps: Dict, cfg, meta, obs) -> str:
    """Write the _tau output file (sightline_tau_rect.f90:340-420 schema)."""
    from ..io.iofile import open_write
    with open_write(filename, cfg.par.file_format) as f:
        for name in ('tau_gas', 'N_gas', 'tau_dust'):
            g = f.create_group(name)
            g.create_dataset('data', data=np.asarray(maps[name]))
            g.attrs['EXTNAME'] = name
            if name == 'tau_gas':
                g.attrs['Dxfreq'] = meta.dxfreq
                g.attrs['Xfreq1'] = meta.xfreq_min
                g.attrs['Xfreq2'] = meta.xfreq_max
    return filename


def _make_sightline_clump(cfg, meta, obs, cmeta):
    """Clump-medium sight-line maps (make_sightline_tau_clump,
    reference src/sightline_tau_clump.f90:33-): per pixel, chord-overlap
    integrals across the CSR grid for tau_gas(nu), N_gas and tau_dust."""
    import math as _m
    from ..transport.engine import (_leaf_gather, clump_xloc_ratio,
                                    line_profile)
    par = cfg.par
    r_loc = clump_xloc_ratio(meta)
    a_loc = meta.voigt_a_cl if meta.Dfreq_cl > 0 else meta.voigt_a_ref
    D_loc = meta.Dfreq_cl if meta.Dfreq_cl > 0 else meta.Dfreq_ref
    R = meta.xmax
    cg_n, cg_dx, K = cmeta.cg_n, cmeta.cg_dx, cmeta.K
    max_steps = 3 * cg_n + 8
    RAD2DEG_ = 180.0 / _m.pi

    def integrate(grid, x, y, z, kx, ky, kz, xfreq, mode):
        def cond(c):
            (x, y, z, acc, live), n = c
            return jnp.logical_and(n < max_steps, jnp.any(live))

        def body(c):
            (x, y, z, acc, live), n = c
            ci = jnp.clip(jnp.floor((x + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            cj = jnp.clip(jnp.floor((y + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            ck = jnp.clip(jnp.floor((z + R) / cg_dx).astype(jnp.int32),
                          0, cg_n - 1)
            cell = (ci * cg_n + cj) * cg_n + ck

            def fd(pos, k, idx):
                up = k > 0.0
                face = -R + jnp.where(up, idx + 1, idx
                                      ).astype(jnp.float32) * cg_dx
                t = (face - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                             jnp.float32(1.0), k)
                return jnp.where(jnp.abs(k) < 1e-12, BIG,
                                 jnp.maximum(t, 0.0))
            t_end = jnp.minimum(jnp.minimum(fd(x, kx, ci), fd(y, ky, cj)),
                                fd(z, kz, ck)) + jnp.float32(1e-6 * R)
            add = jnp.zeros_like(x)
            for q in range(K):
                cand = jnp.take(grid.table.reshape(-1), cell * K + q,
                                mode='clip')
                ok = cand >= 0
                qx = _leaf_gather(grid.x, cand, 0.0)
                qy = _leaf_gather(grid.y, cand, 0.0)
                qz = _leaf_gather(grid.z, cand, 0.0)
                qr2 = _leaf_gather(grid.r2, cand, 0.0)
                ex, ey, ez = x - qx, y - qy, z - qz
                eb = ex * kx + ey * ky + ez * kz
                edet = eb * eb - (ex * ex + ey * ey + ez * ez - qr2)
                sq = jnp.sqrt(jnp.maximum(edet, 0.0))
                t0 = jnp.clip(-eb - sq, 0.0, t_end)
                t1 = jnp.clip(-eb + sq, 0.0, t_end)
                if mode == 0:
                    u_q = ((_leaf_gather(grid.vx, cand, 0.0) * kx
                            + _leaf_gather(grid.vy, cand, 0.0) * ky
                            + _leaf_gather(grid.vz, cand, 0.0) * kz)
                           / r_loc) if not meta.static_medium else 0.0
                    kq = _leaf_gather(grid.rhokap, cand, 0.0) \
                        * line_profile(cfg, (xfreq - u_q) * r_loc,
                                       jnp.float32(a_loc),
                                       jnp.float32(D_loc))
                elif mode == 1:
                    kq = _leaf_gather(grid.rhokap, cand, 0.0) \
                        * jnp.float32(D_loc / cfg.line.cross0)
                else:
                    kq = _leaf_gather(grid.rhokapD, cand, 0.0) \
                        if meta.has_dust else jnp.zeros_like(x)
                kq = jnp.where(jnp.logical_and(ok, edet > 0.0), kq, 0.0)
                add = add + kq * (t1 - t0)
            acc = jnp.where(live, acc + add, acc)
            xn = jnp.where(live, x + t_end * kx, x)
            yn = jnp.where(live, y + t_end * ky, y)
            zn = jnp.where(live, z + t_end * kz, z)
            out = jnp.logical_or(jnp.logical_or(jnp.abs(xn) >= R,
                                                jnp.abs(yn) >= R),
                                 jnp.abs(zn) >= R)
            live = jnp.logical_and(live, ~out)
            return (xn, yn, zn, acc, live), n + 1

        live0 = jnp.ones_like(x, bool)
        carry = ((x, y, z, jnp.zeros_like(x), live0), jnp.int32(0))
        (out, _) = jax.lax.while_loop(cond, body, carry)
        return out[3]

    def ray_origins(odev, iobs):
        R_ = to_host(odev.rmat[iobs])
        pos = to_host(odev.pos[iobs])
        ii, jj = np.meshgrid(np.arange(obs.nxim), np.arange(obs.nyim),
                             indexing='ij')
        ang_x = (ii + 0.5 - obs.nxim / 2.0) * obs.dxim / RAD2DEG_
        ang_y = (jj + 0.5 - obs.nyim / 2.0) * obs.dyim / RAD2DEG_
        kx_o = -np.tan(ang_x)
        ky_o = -np.tan(ang_y)
        kz_o = -np.ones_like(kx_o)
        nrm = np.sqrt(kx_o ** 2 + ky_o ** 2 + kz_o ** 2)
        kobs = np.stack([kx_o / nrm, ky_o / nrm, kz_o / nrm])
        k = np.einsum('ji,jkl->ikl', R_, kobs).reshape(3, -1)
        o = pos[:, None] * np.ones_like(k)
        with np.errstate(divide='ignore', invalid='ignore'):
            t_lo = (np.array([-R, -R, -R])[:, None] - o) / k
            t_hi = (np.array([R, R, R])[:, None] - o) / k
        t_near = np.minimum(t_lo, t_hi)
        t_far = np.maximum(t_lo, t_hi)
        t0 = np.nanmax(np.where(np.isfinite(t_near), t_near, -np.inf), axis=0)
        t1 = np.nanmin(np.where(np.isfinite(t_far), t_far, np.inf), axis=0)
        hit = (t1 > t0) & (t0 > 0)
        start = o + (t0 + 1e-6 * R)[None, :] * k
        return start, k, hit

    def sightline(grid, odev, iobs: int = 0):
        start, k, hit = ray_origins(odev, iobs)
        npix = start.shape[1]
        x = jnp.asarray(start[0], jnp.float32)
        y = jnp.asarray(start[1], jnp.float32)
        z = jnp.asarray(start[2], jnp.float32)
        kx = jnp.asarray(k[0], jnp.float32)
        ky = jnp.asarray(k[1], jnp.float32)
        kz = jnp.asarray(k[2], jnp.float32)
        N_gas = integrate(grid, x, y, z, kx, ky, kz,
                          jnp.zeros_like(x), mode=1)
        tau_dust = integrate(grid, x, y, z, kx, ky, kz,
                             jnp.zeros_like(x), mode=2)
        xf_axis = meta.xfreq_min + (np.arange(meta.nxfreq) + 0.5) \
            * meta.dxfreq
        f = jax.jit(lambda xf0: integrate(grid, x, y, z, kx, ky, kz,
                                          xf0, mode=0))
        taus = [np.asarray(f(jnp.full((npix,), float(xf_axis[i]),
                                      jnp.float32)))
                for i in range(meta.nxfreq)]
        hitm = np.asarray(hit).reshape(obs.nxim, obs.nyim)
        tau_gas = np.stack(taus).reshape(meta.nxfreq, obs.nxim, obs.nyim)
        return {
            'tau_gas': np.where(hitm[None], tau_gas, 0.0),
            'N_gas': np.where(hitm, to_host(N_gas).reshape(
                obs.nxim, obs.nyim), 0.0),
            'tau_dust': np.where(hitm, to_host(tau_dust).reshape(
                obs.nxim, obs.nyim), 0.0),
        }

    return sightline


def _make_sightline_amr(cfg, meta, obs):
    """AMR sight-line maps (make_sightline_tau_outside_amr,
    reference src/sightline_tau_rect.f90:192-): neighbor-table octree walk
    accumulating tau_gas(nu)/N_gas/tau_dust per pixel ray."""
    import math as _m
    from ..transport.engine import (amr_descend_from_face, amr_find_cell,
                                    cell_Dfreq, cell_rhokap, cell_rhokapD,
                                    cell_velocity_dot, cell_voigt_a,
                                    line_profile)
    par = cfg.par
    RAD2DEG_ = 180.0 / _m.pi
    max_steps = 8 * (2 ** meta.levelmax) + 16

    def integrate(grid, x, y, z, kx, ky, kz, xfreq, mode):
        ic = amr_find_cell(grid, meta, x, y, z)

        def cond(c):
            (x, y, z, ic, xf, tau, live), n = c
            return jnp.logical_and(n < max_steps, jnp.any(live))

        def body(c):
            (x, y, z, ic, xf, tau, live), n = c
            D_cell = cell_Dfreq(grid, meta, ic, 0, 0)
            if mode == 0:
                a_cell = cell_voigt_a(grid, meta, ic, 0, 0)
                rho = cell_rhokap(grid, meta, ic, 0, 0) \
                    * line_profile(cfg, xf, a_cell, D_cell)
            elif mode == 1:
                rho = (cell_rhokap(grid, meta, ic, 0, 0) * D_cell
                       / cfg.line.cross0)
            else:
                rho = cell_rhokapD(grid, meta, ic, 0, 0) \
                    if meta.has_dust else jnp.zeros_like(x)

            ccx = jnp.take(grid.node_cx, ic, mode='clip')
            ccy = jnp.take(grid.node_cy, ic, mode='clip')
            ccz = jnp.take(grid.node_cz, ic, mode='clip')
            hh = jnp.take(grid.node_ch, ic, mode='clip')

            def axis_t(pos, k, c0):
                fc = c0 + jnp.where(k > 0, hh, -hh)
                t = (fc - pos) / jnp.where(jnp.abs(k) < 1e-12,
                                           jnp.float32(1.0), k)
                return jnp.where(jnp.abs(k) < 1e-12, BIG,
                                 jnp.maximum(t, 0.0))

            tx = axis_t(x, kx, ccx)
            ty = axis_t(y, ky, ccy)
            tz = axis_t(z, kz, ccz)
            dmin = jnp.minimum(jnp.minimum(tx, ty), tz)
            axis = jnp.where(dmin == tx, 0, jnp.where(dmin == ty, 1, 2))
            tau_n = jnp.where(live, tau + dmin * rho, tau)
            kax = jnp.where(axis == 0, kx, jnp.where(axis == 1, ky, kz))
            face = axis * 2 + jnp.where(kax > 0, 0, 1)
            xn = jnp.where(live, x + dmin * kx, x)
            yn = jnp.where(live, y + dmin * ky, y)
            zn = jnp.where(live, z + dmin * kz, z)
            nb = jnp.take(grid.neighbor.reshape(-1),
                          jnp.maximum(ic, 0) * 6 + face, mode='clip')
            esc = jnp.logical_and(live, nb < 0)
            icn = amr_descend_from_face(grid, meta, jnp.maximum(nb, 0),
                                        face, xn, yn, zn)
            icn = jnp.where(jnp.logical_and(live, ~esc), icn, ic)
            if mode == 0 and (not meta.static_medium
                              or not meta.uniform_temperature):
                u1 = cell_velocity_dot(grid, meta, ic, 0, 0, kx, ky, kz)
                u2 = cell_velocity_dot(grid, meta, icn, 0, 0, kx, ky, kz)
                D2 = cell_Dfreq(grid, meta, icn, 0, 0)
                xf = jnp.where(jnp.logical_and(live, ~esc),
                               (xf + u1) * D_cell / D2 - u2, xf)
            live = jnp.logical_and(live, ~esc)
            return (xn, yn, zn, icn, xf, tau_n, live), n + 1

        live0 = jnp.ones_like(x, bool)
        carry = ((x, y, z, ic, xfreq, jnp.zeros_like(x), live0),
                 jnp.int32(0))
        (out, _) = jax.lax.while_loop(cond, body, carry)
        return out[5]

    xmn, ymn, zmn = meta.xmin, meta.ymin, meta.zmin
    xmx, ymx, zmx = meta.xmax, meta.ymax, meta.zmax

    def ray_origins(odev, iobs):
        R_ = to_host(odev.rmat[iobs])
        pos = to_host(odev.pos[iobs])
        ii, jj = np.meshgrid(np.arange(obs.nxim), np.arange(obs.nyim),
                             indexing='ij')
        ang_x = (ii + 0.5 - obs.nxim / 2.0) * obs.dxim / RAD2DEG_
        ang_y = (jj + 0.5 - obs.nyim / 2.0) * obs.dyim / RAD2DEG_
        kx_o = -np.tan(ang_x)
        ky_o = -np.tan(ang_y)
        kz_o = -np.ones_like(kx_o)
        nrm = np.sqrt(kx_o ** 2 + ky_o ** 2 + kz_o ** 2)
        kobs = np.stack([kx_o / nrm, ky_o / nrm, kz_o / nrm])
        k = np.einsum('ji,jkl->ikl', R_, kobs).reshape(3, -1)
        o = pos[:, None] * np.ones_like(k)
        with np.errstate(divide='ignore', invalid='ignore'):
            t_lo = (np.array([xmn, ymn, zmn])[:, None] - o) / k
            t_hi = (np.array([xmx, ymx, zmx])[:, None] - o) / k
        t_near = np.minimum(t_lo, t_hi)
        t_far = np.maximum(t_lo, t_hi)
        t0 = np.nanmax(np.where(np.isfinite(t_near), t_near, -np.inf), axis=0)
        t1 = np.nanmin(np.where(np.isfinite(t_far), t_far, np.inf), axis=0)
        hit = (t1 > t0) & (t0 > 0)
        start = o + (t0 + 1e-6 * (xmx - xmn))[None, :] * k
        return start, k, hit

    def sightline(grid, odev, iobs: int = 0):
        start, k, hit = ray_origins(odev, iobs)
        npix = start.shape[1]
        x = jnp.asarray(start[0], jnp.float32)
        y = jnp.asarray(start[1], jnp.float32)
        z = jnp.asarray(start[2], jnp.float32)
        kx = jnp.asarray(k[0], jnp.float32)
        ky = jnp.asarray(k[1], jnp.float32)
        kz = jnp.asarray(k[2], jnp.float32)
        N_gas = integrate(grid, x, y, z, kx, ky, kz,
                          jnp.zeros_like(x), mode=1)
        tau_dust = integrate(grid, x, y, z, kx, ky, kz,
                             jnp.zeros_like(x), mode=2)
        xf_axis = meta.xfreq_min + (np.arange(meta.nxfreq) + 0.5) \
            * meta.dxfreq
        f = jax.jit(lambda xf0: integrate(grid, x, y, z, kx, ky, kz,
                                          xf0, mode=0))
        taus = []
        for ixf in range(meta.nxfreq):
            xf0 = jnp.full((npix,), float(xf_axis[ixf]), jnp.float32)
            if not meta.static_medium or not meta.uniform_temperature:
                from ..transport.engine import (amr_find_cell as _fc,
                                                cell_Dfreq as _cD,
                                                cell_velocity_dot as _cv)
                ic0 = _fc(grid, meta, x, y, z)
                D1 = _cD(grid, meta, ic0, 0, 0)
                u1 = _cv(grid, meta, ic0, 0, 0, kx, ky, kz)
                xf0 = xf0 * (meta.Dfreq_ref / D1) - u1
            taus.append(to_host(f(xf0)))
        hitm = np.asarray(hit).reshape(obs.nxim, obs.nyim)
        tau_gas = np.stack(taus).reshape(meta.nxfreq, obs.nxim, obs.nyim)
        return {
            'tau_gas': np.where(hitm[None], tau_gas, 0.0),
            'N_gas': np.where(hitm, to_host(N_gas).reshape(
                obs.nxim, obs.nyim), 0.0),
            'tau_dust': np.where(hitm, to_host(tau_dust).reshape(
                obs.nxim, obs.nyim), 0.0),
        }

    return sightline
