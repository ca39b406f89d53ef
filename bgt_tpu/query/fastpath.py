"""Batched single-database query execution on the device.

The TPU-native replacement for the reference's per-site read loop: the site
table (positions, alleles, row numbers) is scanned once into numpy arrays,
site selection (region/BED/paging) becomes a vectorized mask, genotype
counting runs as masked-popcount device kernels over the packed tile store
in HBM (optionally sharded over a device mesh), site filters evaluate as
compiled vector expressions over the AC/AN arrays, and VCF text assembles
from LUT gathers.  Output bytes are identical to the general path (and the
reference CLI); tests cross-check both.

Applicability: single database, no allele-set (-a) and no -S/-H accumulators
(those run on the general path).
"""

from __future__ import annotations

import numpy as np

from ..core import kexpr
from ..formats import bcf as bcflib
from ..io.bgzf import BgzfReader
from ..ops import counts as counts_ops
from ..ops.tiles import TileStore
from . import engine

BATCH_ROWS = 4096


class SiteTable:
    """All site records of a DB parsed into columnar arrays (one-time scan)."""

    def __init__(self, prefix: str, h0: bcflib.BcfHeader):
        fp = BgzfReader(prefix + ".bcf")
        bcflib.BcfHeader.read_bcf(fp)
        rid = []
        pos = []
        rlen = []
        nal = []
        refs = []
        alts = []
        ref_lens = []
        b = bcflib.Bcf1()
        while b.read(fp) >= 0:
            rid.append(b.rid)
            pos.append(b.pos)
            rlen.append(b.rlen)
            nal.append(b.n_allele)
            r, a = b.get_ref_alt1()
            refs.append(r)
            alts.append(a)
            ref_lens.append(len(r))
        fp.close()
        self.n = len(rid)
        self.rid = np.array(rid, dtype=np.int32)
        self.pos = np.array(pos, dtype=np.int64)
        self.rlen = np.array(rlen, dtype=np.int64)
        self.n_allele = np.array(nal, dtype=np.int32)
        self.ref_len = np.array(ref_lens, dtype=np.int64)
        self.refs = refs
        self.alts = alts
        # pre-decoded display strings (ALT includes ",<M>" for 3-allele sites)
        self.ref_str = [r.decode("latin-1") for r in refs]
        self.alt_str = [
            a.decode("latin-1") + (",<M>" if nal[i] > 2 else "")
            for i, a in enumerate(alts)
        ]
        self.h0 = h0


_SITE_CACHE: dict = {}
_TILE_CACHE: dict = {}
_DEVICE_CACHE: dict = {}


def get_site_table(bf: engine.BgtFile) -> SiteTable:
    st = _SITE_CACHE.get(bf.prefix)
    if st is None:
        st = SiteTable(bf.prefix, bf.h0)
        _SITE_CACHE[bf.prefix] = st
    return st


def get_tiles(bf: engine.BgtFile) -> TileStore:
    ts = _TILE_CACHE.get(bf.prefix)
    if ts is None:
        ts = TileStore.open_or_build(bf.prefix)
        _TILE_CACHE[bf.prefix] = ts
    return ts


class DeviceTiles:
    """Tile planes resident on the device (transferred once per process)."""

    def __init__(self, ts: TileStore):
        import jax.numpy as jnp
        self.n_rows = ts.n_rows
        self.p0 = jnp.asarray(ts.plane0)
        self.p1 = jnp.asarray(ts.plane1)
        self.p0.block_until_ready()


def get_device_tiles(bf: engine.BgtFile) -> DeviceTiles:
    dt = _DEVICE_CACHE.get(bf.prefix)
    if dt is None:
        dt = DeviceTiles(get_tiles(bf))
        _DEVICE_CACHE[bf.prefix] = dt
    return dt


def _bucket(n: int, cap: int) -> int:
    b = 1024
    while b < n:
        b <<= 1
    return min(b, cap)


def applicable(opt, bm: engine.BgtmReader) -> bool:
    return (
        bm.n_bgt == 1
        and bm.h_al is None
        and not bm.flag & (engine.F_CNT_AL | engine.F_CNT_HAP)
    )


class FastView:
    """Executes a prepared single-DB BgtmReader query batch-wise."""

    def __init__(self, bm: engine.BgtmReader, opt, sharding=None):
        self.bm = bm
        self.opt = opt
        self.g = bm.bgt[0]
        self.bf = self.g.f
        self.st = get_site_table(self.bf)
        self.ts = get_tiles(self.bf)
        self.sharding = sharding  # optional parallel.mesh context

    # --- site selection ----------------------------------------------------

    def select_rows(self) -> np.ndarray:
        st = self.st
        g = self.g
        if g.itr is not None:
            it = g.itr
            mask = (st.rid == it.tid) & (st.pos < it.end) & (st.pos + st.rlen > it.beg)
            rows = np.nonzero(mask)[0]
        elif self.opt.seekn > 0:
            rows = np.arange(min(self.opt.seekn, st.n), st.n)
        else:
            rows = np.arange(st.n)
        if g.bed is not None:
            keep = []
            for r in rows:
                chrom = g.h_out.id_name(bcflib.BCF_DT_CTG, int(st.rid[r]))
                hit = g.bed.overlap(chrom, int(st.pos[r]), int(st.pos[r] + st.rlen[r]))
                if g.bed_excl != bool(hit):
                    keep.append(r)
            rows = np.array(keep, dtype=np.int64)
        return rows

    # --- device counting ---------------------------------------------------

    def _masks(self) -> np.ndarray:
        bm = self.bm
        g = self.g
        if bm.n_groups > 1:
            return self.ts.group_masks(np.asarray(g.group), bm.n_groups,
                                       np.asarray(g.out))
        cols = np.empty(g.n_out * 2, dtype=np.int64)
        cols[0::2] = np.asarray(g.out) * 2
        cols[1::2] = np.asarray(g.out) * 2 + 1
        return self.ts.pack_mask(cols)[None, :]

    def counts_for(self, rows: np.ndarray) -> np.ndarray:
        """(len(rows), n_groups, 4) counts via the device kernel.

        The planes stay device-resident; the row range is sliced on device
        (bucketed static lengths limit recompiles) and only the tiny count
        tensor is read back.
        """
        import jax.numpy as jnp
        masks = self._masks()
        if rows.size == 0:
            return np.zeros((0, masks.shape[0], 4), dtype=np.int32)
        if self.sharding is not None:
            fn, put = self.sharding
            out = []
            for lo in range(0, rows.size, BATCH_ROWS):
                sl = rows[lo: lo + BATCH_ROWS]
                p0, p1, msk = put(self.ts.plane0[sl], self.ts.plane1[sl], masks)
                out.append(np.asarray(fn(p0, p1, msk)))
            return np.concatenate(out, axis=0)
        dt = get_device_tiles(self.bf)
        start = int(rows[0])
        span = int(rows[-1]) + 1 - start
        length = _bucket(span, dt.n_rows)
        start = min(start, dt.n_rows - length)
        counts = counts_ops.count_codes_range(
            dt.p0, dt.p1, jnp.asarray(masks), start, length)
        return np.asarray(counts)[rows - start]

    # --- the full run ------------------------------------------------------

    def run(self, out) -> None:
        bm = self.bm
        st = self.st
        opt = self.opt
        if self.g.n_out == 0:
            return
        rows = self.select_rows()
        counts = self.counts_for(rows)
        bm.n_gt_read += int(rows.size) * self.g.n_out

        tot = counts.sum(axis=1)
        an = tot[:, 0] + tot[:, 1] + tot[:, 3]
        ac = tot[:, 1]
        ac_m = tot[:, 3]
        n_groups = bm.n_groups
        if n_groups > 1:
            gan = counts[:, :, 0] + counts[:, :, 1] + counts[:, :, 3]
            gac = counts[:, :, 1]
            gac_m = counts[:, :, 3]

        # site filter over the whole batch
        pass_mask = np.ones(rows.size, dtype=bool)
        if bm.site_flt is not None:
            env = {"AC": ac.astype(np.int64), "AN": an.astype(np.int64)}
            for gi in range(n_groups):
                env[f"AN{gi + 1}"] = (gan[:, gi] if n_groups > 1 else an).astype(np.int64)
                env[f"AC{gi + 1}"] = (gac[:, gi] if n_groups > 1 else ac).astype(np.int64)
            try:
                fn = bm.site_flt.compile_vector(np)
                missing = bm.site_flt.var_names - set(env)
                if missing:
                    raise TypeError(f"unknown vars {missing}")
                _t, vec = fn(env)
                pass_mask = np.asarray(vec) != 0
            except (TypeError, KeyError):
                for i in range(rows.size):
                    ss = self._site_info(i, counts)
                    pass_mask[i] = bm.pass_site_flt(ss)

        info_on = bool(bm.flag & engine.F_SET_AC) or bm.site_flt is not None \
            or bool(bm.fields) or n_groups > 1
        no_gt = bool(bm.flag & engine.F_NO_GT)

        # GT columns: output samples with mgs<=1, 2 columns each
        if not no_gt:
            keep = np.asarray(bm.mgs) <= 1
            samples = np.asarray(self.g.out)[keep]
            cols = np.empty(samples.size * 2, dtype=np.int64)
            cols[0::2] = samples * 2
            cols[1::2] = samples * 2 + 1

        n_rec = opt.n_rec if opt.n_rec is not None else None
        h_out = bm.h_out
        ctg_names = [n for n, _ in h_out.ids[bcflib.BCF_DT_CTG]]

        # final site selection (filter + record budget)
        sel = np.nonzero(pass_mask)[0]
        if n_rec is not None and sel.size > n_rec:
            sel = sel[:n_rec]
        if sel.size == 0:
            return
        sel_rows = rows[sel]

        if bm.fields:  # -t table mode: exact scalar field evaluation
            gen = self._compile_fields(an, ac, counts)
            write = out.write
            for i, r in zip(sel.tolist(), sel_rows.tolist()):
                write(gen(i, int(r)) + "\n")
            return

        self._emit_vcf_lines(out, sel, sel_rows, an, ac, ac_m,
                             gan if n_groups > 1 else None,
                             gac if n_groups > 1 else None,
                             gac_m if n_groups > 1 else None,
                             info_on, no_gt, None if no_gt else cols, ctg_names)

    def _emit_vcf_lines(self, out, sel, sel_rows, an, ac, ac_m, gan, gac, gac_m,
                        info_on, no_gt, cols, ctg_names) -> None:
        """Assemble and write all passing site lines.

        The dominant regular shape (biallelic, no END) is a tight f-string
        loop over pre-stringified columns; irregular sites (<M> allele or
        END-carrying indels) take a generic branch.  GT cells come from one
        LUT gather for the whole batch, decoded to one big string sliced
        per row.
        """
        st = self.st
        n_groups = self.bm.n_groups
        from .view import _CELL_LUT

        irregular = (st.n_allele[sel_rows] > 2) | (st.ref_len[sel_rows] != st.rlen[sel_rows])
        pos1 = (st.pos[sel_rows] + 1).tolist()
        rid_l = st.rid[sel_rows].tolist()
        rows_l = sel_rows.tolist()
        irr_l = irregular.tolist()
        ref_str = st.ref_str
        alt_str = st.alt_str

        if info_on:
            an_l = an[sel].tolist()
            ac_l = ac[sel].tolist()
            if n_groups > 1:
                gvals = [gan[sel, gi // 2].tolist() if gi % 2 == 0
                         else gac[sel, gi // 2].tolist()
                         for gi in range(2 * n_groups)]
                gtempl = "".join(
                    f";AN{g + 1}={{}};AC{g + 1}={{}}" for g in range(n_groups))

        # GT cells for the whole selection in one gather
        gt_strs = None
        if cols is not None and cols.size:
            blocks = []
            for lo in range(0, sel_rows.size, BATCH_ROWS):
                codes = self.ts.codes(sel_rows[lo: lo + BATCH_ROWS], cols)
                idx = codes[:, 0::2].astype(np.int64) * 4 + codes[:, 1::2]
                blocks.append(_CELL_LUT[idx])
            cells = np.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
            big = cells.tobytes().decode("latin-1")
            w = 4 * cells.shape[1]
            gt_strs = (big, w)

        parts: list[str] = []
        ap = parts.append
        for k in range(len(rows_l)):
            chrom = ctg_names[rid_l[k]]
            r = rows_l[k]
            if not irr_l[k]:
                if info_on:
                    if n_groups > 1:
                        line = (f"{chrom}\t{pos1[k]}\t.\t{ref_str[r]}\t{alt_str[r]}"
                                f"\t0\t.\tAN={an_l[k]};AC={ac_l[k]}"
                                + gtempl.format(*(gv[k] for gv in gvals)))
                    else:
                        line = (f"{chrom}\t{pos1[k]}\t.\t{ref_str[r]}\t{alt_str[r]}"
                                f"\t0\t.\tAN={an_l[k]};AC={ac_l[k]}")
                else:
                    line = f"{chrom}\t{pos1[k]}\t.\t{ref_str[r]}\t{alt_str[r]}\t0\t.\t."
            else:
                infos = []
                if st.ref_len[r] != st.rlen[r]:
                    infos.append(f"END={int(st.pos[r] + st.rlen[r])}")
                multi = st.n_allele[r] > 2
                if info_on:
                    i = sel[k]
                    infos.append(f"AN={int(an[i])}")
                    infos.append(f"AC={int(ac[i])},{int(ac_m[i])}" if multi
                                 else f"AC={int(ac[i])}")
                    if n_groups > 1:
                        for gi in range(n_groups):
                            infos.append(f"AN{gi + 1}={int(gan[i, gi])}")
                            infos.append(
                                f"AC{gi + 1}={int(gac[i, gi])},{int(gac_m[i, gi])}"
                                if multi else f"AC{gi + 1}={int(gac[i, gi])}")
                line = (f"{chrom}\t{pos1[k]}\t.\t{ref_str[r]}\t{alt_str[r]}\t0\t.\t"
                        + (";".join(infos) if infos else "."))
            if gt_strs is not None:
                big, w = gt_strs
                line += "\tGT" + big[k * w: (k + 1) * w]
            ap(line)
        ap("")
        out.write("\n".join(parts))

    def _site_info(self, i: int, counts: np.ndarray) -> engine.SiteInfo:
        ss = engine.SiteInfo()
        ss.n_groups = self.bm.n_groups
        tot = counts[i].sum(axis=0)
        ss.an = int(tot[0] + tot[1] + tot[3])
        ss.ac = [int(tot[1]), int(tot[3])]
        if ss.n_groups > 1:
            ss.gan = [int(counts[i, g, 0] + counts[i, g, 1] + counts[i, g, 3])
                      for g in range(ss.n_groups)]
            ss.gac = [[int(counts[i, g, 1]), int(counts[i, g, 3])]
                      for g in range(ss.n_groups)]
        return ss

    def _compile_fields(self, an, ac, counts):
        """Per-site table-line generator using scalar kexpr eval (exact)."""
        bm = self.bm
        st = self.st
        ctg_names = [n for n, _ in bm.h_out.ids[bcflib.BCF_DT_CTG]]

        def gen(i: int, r: int) -> str:
            ss = self._site_info(i, counts)
            parts = []
            for ke in bm.fields:
                bm._assign_expr(ke, ss)
                ke.set_str("CHROM", ctg_names[int(st.rid[r])])
                ke.set_int("POS", int(st.pos[r]) + 1)
                ke.set_int("END", int(st.pos[r] + st.rlen[r]))
                ke.set_str("REF", st.refs[r].decode("latin-1"))
                ke.set_str("ALT", st.alts[r].decode("latin-1"))
                err, iv, rv, sv, t = ke.eval()
                if err:
                    parts.append("*")
                elif t == kexpr.KEV_INT:
                    parts.append(str(iv))
                elif t == kexpr.KEV_REAL:
                    parts.append("%g" % rv)
                else:
                    parts.append(sv)
            return "\t".join(parts)

        return gen
